package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale BPE: distributed merge learning + vocabulary-cached
  * encoding.
  *
  * Learning (Sennrich-style) is inherently sequential — each merge changes
  * the pair statistics — so [[learn]] runs k rounds where each round is one
  * pair-count aggregation over the (distributed) word-frequency table and a
  * one-row argmax collect. The corpus is touched ONCE (the word-count
  * aggregation); every round after that works on the vocabulary, which
  * grows sublinearly with corpus size. This is more distributed than the
  * standard in-memory trainers (which collect the whole word-count dict);
  * the per-round driver action is a single row, documented as such.
  *
  * Encoding uses the distinct-pretoken cache trick: the expensive greedy
  * merge loop runs once per DISTINCT word (vocabulary-scale, with the rank
  * table broadcast), and per-document piece counts come from joining
  * occurrences back on the word key — the same sublinear shape serving
  * tokenizers use (t9/t13 cover pretokenization and merge-candidate
  * statistics; this closes the loop to an applied tokenizer).
  */
object BpeTokenizer {

  /** Greedy BPE encode of one pretoken: repeatedly take the lowest-rank
    * pair present and merge ALL its non-overlapping occurrences
    * left-to-right. Deterministic; characters not covered by any merge
    * stay single pieces.
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var pieces = word.map(_.toString).toVector
    var done = pieces.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < pieces.size - 1) {
        val r = ranks.getOrElse((pieces(i), pieces(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestA = pieces(i); bestB = pieces(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        pieces = mergeAll(pieces, bestA, bestB)
        if (pieces.size < 2) done = true
      }
    }
    pieces
  }

  /** Merge all non-overlapping (a, b) adjacencies, left to right. */
  def mergeAll(pieces: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < pieces.size) {
      if (i < pieces.size - 1 && pieces(i) == a && pieces(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += pieces(i); i += 1 }
    }
    out.result()
  }

  /** Word-frequency table of the corpus: (word, n). One corpus pass. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(PipelineFns.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges from a (word, n) table. Each round: explode
    * adjacent piece pairs weighted by word count, aggregate, take the
    * (count desc, pair asc) argmax — a ONE-ROW collect per round, the only
    * driver action; the vocab table itself stays distributed — then apply
    * the merge to the piece arrays. Rounds stop early when no pair repeats.
    */
  def learn(words: DataFrame, numMerges: Int): Seq[(String, String)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val splitChars = udf((w: String) => w.map(_.toString))
    // cache ONLY the corpus-derived base (the expensive aggregate); each
    // round then adds one narrow vocab-local map to the lineage, so round
    // i's aggregation re-runs i cheap maps over the cached vocab instead
    // of re-touching the corpus — no per-round materialize/unpersist jobs
    val base = words.select(col("word"), col("n"), splitChars(col("word")).as("pieces")).cache()
    var cur = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < numMerges) {
      // lineage grows one UDF layer per merge round; analysis cost per round
      // is O(depth), so a real vocabulary (32k merges) would pay O(k²) in
      // the analyzer alone. Truncate the chain every CheckpointEvery rounds:
      // the vocab table is vocabulary-scale (small next to the corpus), so
      // the eager materialize is cheap and bounds plan depth to a constant.
      if (merges.nonEmpty && merges.size % CheckpointEvery == 0 && cur.ne(base))
        cur = cur.localCheckpoint()
      val pairs = cur.select(col("n"),
          explode(arrays_zip(
            slice(col("pieces"), lit(1), greatest(size(col("pieces")) - 1, lit(0))),
            slice(col("pieces"), lit(2), greatest(size(col("pieces")) - 1, lit(0))))).as("p"))
        .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"), col("n"))
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))
        // a pair seen once can't compress anything
        .filter(col("cnt") >= 2)
      val top = pairs.orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .select(col("a"), col("b")).as[(String, String)].take(1)
      top.headOption match {
        case None => done = true
        case Some((a, b)) =>
          merges += ((a, b))
          val applyMerge = udf((ps: Seq[String]) => mergeAll(ps.toVector, a, b))
          cur = cur.withColumn("pieces", applyMerge(col("pieces")))
      }
    }
    base.unpersist()
    merges.toSeq
  }

  /** Lineage-truncation interval for [[learn]]: plan depth stays ≤ this
    * many UDF layers regardless of vocabulary size.
    */
  val CheckpointEvery = 64

  /** Rank table from an ordered merge list. */
  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** The catalog's pinned 8-merge rank table (t16a): the exact output of
    * [[learn]] over the sf0.01 `documents` word-frequency table, frozen as
    * literals. Pinning decouples the ENCODE half (deterministic given a
    * rank table — hard-oracle-checkable) from the LEARN half (iterative
    * argmax, spec-pinned by BpeTokenizerSpec): the catalog query encodes
    * any corpus under this fixed vocabulary, the way a serving tokenizer
    * ships a frozen merges.txt.
    */
  val PinnedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"))

  /** DuckDB oracle for greedy encode under a FIXED merge list: a recursive
    * CTE over the distinct vocabulary. Pieces are rendered as a
    * `(p1)(p2)…` string — tokens are [a-z0-9]+ so the parens are
    * unambiguous delimiters — which makes both halves of each greedy round
    * plain string ops: "lowest-rank pair present" is a rank-ordered CASE
    * over instr(), and "merge ALL non-overlapping occurrences
    * left-to-right" is exactly SQL replace() because adjacent `(a)(b)`
    * renderings share no characters. Terminal rows (no ranked pair
    * present) carry the piece count; per-doc totals join occurrences back
    * on the word key — the same distinct-word cache shape as
    * [[pieceCounts]].
    */
  def encodeOracleSql(merges: Seq[(String, String)]): String = {
    // tokens are [a-z0-9]+ by the tokenizer contract, so '(piece)(piece)'
    // renderings are quote-free; escape anyway so a caller feeding a wider
    // alphabet gets valid SQL, and reject the empty merge list outright
    // (it would generate degenerate CASE/WHERE fragments).
    require(merges.nonEmpty, "encodeOracleSql needs at least one merge")
    def esc(s: String) = s.replace("'", "''")
    def pat(a: String, b: String) = s"(${esc(a)})(${esc(b)})"
    val caseBest = merges.zipWithIndex.map { case ((a, b), i) =>
      s"WHEN instr(s, '${pat(a, b)}') > 0 THEN $i"
    }.mkString("CASE ", " ", " ELSE -1 END")
    val caseApply = merges.zipWithIndex.map { case ((a, b), i) =>
      s"WHEN $i THEN replace(s, '${pat(a, b)}', '(${esc(a + b)})')"
    }.mkString("CASE best ", " ", " END")
    val noPair = merges.map { case (a, b) => s"instr(s, '${pat(a, b)}') = 0" }
      .mkString(" AND ")
    s"""WITH RECURSIVE
       |occ AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |  FROM documents),
       |words AS (SELECT DISTINCT word FROM occ),
       |enc AS (
       |  SELECT word,
       |    '(' || array_to_string(list_transform(range(1, length(word) + 1),
       |      i -> substring(word, CAST(i AS INT), 1)), ')(') || ')' AS s
       |  FROM words
       |  UNION ALL
       |  SELECT word, $caseApply AS s
       |  FROM (SELECT word, s, $caseBest AS best FROM enc)
       |  WHERE best >= 0),
       |fin AS (
       |  SELECT word, length(s) - length(replace(s, '(', '')) AS n_pieces
       |  FROM enc WHERE $noPair)
       |SELECT o.doc_id, count(*) AS n_words,
       |  CAST(sum(f.n_pieces) AS BIGINT) AS n_pieces,
       |  round(CAST(sum(f.n_pieces) AS DOUBLE) / count(*), 4) AS pieces_per_word
       |FROM occ o JOIN fin f USING (word)
       |GROUP BY o.doc_id""".stripMargin
  }

  /** Per-document piece counts under a learned rank table: encode each
    * DISTINCT word once (broadcast ranks, vocabulary-scale work), join
    * occurrences back on the word key.
    */
  def pieceCounts(docs: DataFrame, ranks: Map[(String, String), Int]): DataFrame = {
    // closure-captured, NOT sparkContext.broadcast: pieceCounts runs at
    // query-CONSTRUCTION time for every build of t16a (Verify, Bench, plan
    // sweeps), and an explicit broadcast per build is never destroyed —
    // the merge-rank map is vocabulary-bounded and ships fine with the
    // task closure. No .cache() on the occurrence table for the same
    // reason (one CacheManager entry per build, unreleasable — the
    // IvfCentroids.train tradeoff): the two consumers re-run the
    // tokenize+explode scan instead, which stays map-only and fuses into
    // each consumer's own stage.
    val nPieces = udf((w: String) => encode(w, ranks).size)
    val occurrences = docs.select(col("doc_id"), explode(PipelineFns.tokens(col("text"))).as("word"))
    val encoded = occurrences.select(col("word")).distinct()
      .withColumn("n_pieces", nPieces(col("word")))
    occurrences.join(encoded, "word")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"))
  }
}
