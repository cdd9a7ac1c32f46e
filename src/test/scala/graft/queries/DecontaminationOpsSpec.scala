package graft.queries

import graft.SparkEntry
import graft.vlm.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic contracts of the round-9 decontamination/dedup additions:
  * d17 (fuzzy Jaccard decontamination), v13 (embedding-space
  * decontamination), mm7 (perceptual-hash near-dup). Each is checked
  * against an independent in-test recomputation, not just for shape.
  */
class DecontaminationOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d17: flags only training docs, against eval docs, at verified Jaccard >= 0.5") {
    val rows = SparkEntry.queries("d17_fuzzy_decontaminate")(spark, sf).collect()
    assert(rows.nonEmpty, "no fuzzy contamination found in the fixture corpus")
    for (r <- rows) {
      assert(r.getLong(0) % 97 != 0, s"eval doc ${r.getLong(0)} flagged as training")
      assert(r.getLong(2) % 97 == 0, s"training doc ${r.getLong(2)} reported as eval match")
      assert(r.getDouble(3) >= 0.5 && r.getDouble(3) <= 1.0, s"jaccard out of range: $r")
      assert(r.getLong(1) >= 1)
    }
    // independent verification of the reported max_jaccard on every pair
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), graft.functions.shingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    for (r <- rows) {
      val (a, b) = (sets(r.getLong(0)), sets(r.getLong(2)))
      val j = a.intersect(b).size.toDouble / (a.size + b.size - a.intersect(b).size)
      assert(math.abs(BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        - r.getDouble(3)) < 1e-9, s"reported max_jaccard mismatch for $r (true $j)")
    }
  }

  test("v13: per-vector argmax cosine matches a brute-force recomputation") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), graft.functions.quantizeVec(col("embedding"), 1000).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val evals = vecs.keys.filter(_ % 97 == 0).toSeq.sorted
    assert(evals.nonEmpty)
    val rows = SparkEntry.queries("v13_semantic_decontaminate")(spark, sf).collect()
    assert(rows.length == vecs.size - evals.size, "one row per training vector")
    for (r <- rows) {
      val vid = r.getLong(0)
      assert(vid % 97 != 0)
      // Scala tuple max on (cos, -eval_id) replays the query's tie rule
      val (bc, negE) = evals.map(e => (cos(vecs(vid), vecs(e)), -e)).max
      assert(-negE == r.getLong(1), s"argmax eval mismatch for $vid")
      assert(math.abs(BigDecimal(bc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        - r.getDouble(2)) < 1e-9, s"max_cos mismatch for $vid")
      assert(r.getBoolean(3) == (bc >= 0.4), s"contaminated flag mismatch for $vid")
    }
    assert(rows.exists(_.getBoolean(3)), "fixture should contain semantic contamination")
    assert(rows.exists(!_.getBoolean(3)), "fixture should contain clean vectors")
  }

  test("mm7: chunk-bucketed pairs equal the exhaustive hamming<=3 pair set (pigeonhole completeness)") {
    import graft.queries.PipelineFns.h60Jvm
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    def phash(id: Long): Long = {
      var h = h60Jvm(s"phb:${id / 16}") % (1L << 56)
      val nf = id % 4
      for (j <- 0 until 3 if j < nf)
        h ^= 1L << (h60Jvm(s"phf:$id:$j") % 56).toInt
      h
    }
    val ph = ids.map(id => id -> phash(id)).toMap
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if java.lang.Long.bitCount(ph(a) ^ ph(b)) <= 3
    } yield (a, b, java.lang.Long.bitCount(ph(a) ^ ph(b)))).toSet
    assert(expected.nonEmpty, "fixture should plant near-dup phashes")
    val got = SparkEntry.queries("mm7_phash_near_dup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }
}
