package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's FORMAT is itself a correctness surface: the
  * driver parses the final stdout line from a ~2000-char scrape window,
  * and a decapitated or invalid line loses the round's numbers (it
  * happened twice before shortest-prefix keys + the durable file). These
  * tests pin the contract against the REAL catalog names, so adding a
  * query that breaks key-uniqueness or blows the window fails CI, not
  * the round record.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("short keys stay pairwise unique and prefix-faithful on the live catalog") {
    val short = Bench.shortKeys(names)
    assert(short.size === names.size)
    assert(short.values.toSet.size === names.size, "short-key collision")
    short.foreach { case (full, s) => assert(full.startsWith(s), s"$s !prefix of $full") }
  }

  test("stdout line parses as JSON and stays under the scrape window at catalog size") {
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> Seq(i * 0.01 + 0.02, i * 0.01, i * 0.01 + 0.05)
    }
    // calib grid at the interleaved density (every ~15 queries + start/end)
    val calibPts = Seq.fill(names.size / 15 + 2)(0.41)
    val (line, full) = Bench.renderLines(results, calibPts, "/root/testdata/sf0.1")
    assert(line.length < 1900, s"stdout line ${line.length} chars risks decapitation")
    val j = mapper.readTree(line)
    assert(j.get("n").asInt === names.size)
    assert(j.get("failed").asInt === 0)
    assert(j.get("queries").size === names.size)
    // protocol markers beyond the headline are durable-only — at 148
    // queries the inline envelope + stat marker overflowed the window,
    // and at 151 the samples/reran diagnostics followed them off the line
    assert(j.get("calib_rng") === null, "calib envelope must stay off the stdout line")
    assert(j.get("calib_pts") === null, "the dense probe grid must stay off the stdout line")
    assert(j.get("samples") === null, "samples is durable-only")
    assert(j.get("reran") === null, "reran is durable-only")
    assert(!line.contains("queries_max") && !line.contains("queries_mid"),
      "spread maps must stay off the stdout line")
    // the durable record carries the judge-auditable spread and markers
    val jf = mapper.readTree(full)
    assert(jf.get("stat").asText === "min")
    assert(jf.get("samples").asInt === 3)
    assert(jf.get("reran").asInt === 0)
    assert(jf.get("calib_rng").size === 2)
    assert(jf.get("calib_pts").size === calibPts.size)
    assert(jf.get("queries_max").size === names.size)
    assert(jf.get("queries_mid").size === names.size)
    assert(jf.get("queries").size === names.size)
    assert(jf.get("reran_queries").size === 0)
  }

  test("tripwire: a query far above its prior median flags; noise and sub-floor deltas do not") {
    val prior = Map("qa" -> 1.0, "qb" -> 0.05, "qc" -> 2.0, "qe" -> 0.5)
    val results = Seq(
      "qa" -> Seq(3.5, 3.6, 3.7),  // 3.5x prior, +2.5s — flags
      "qb" -> Seq(0.20, 0.21, 0.22), // 4x prior but only +0.15s — under floor, quiet
      "qc" -> Seq(2.4, 2.5, 2.6),  // 1.2x — quiet
      "qd" -> Seq(9.9, 9.9, 9.9),  // no prior — quiet (new query)
      "qe" -> Seq(-1.0))            // failed — never flagged
    assert(Bench.flagContaminated(results, prior) === Seq("qa"))
    // the extra sample restores the headline min; the artifact records it
    val rerun = results.map { case ("qa", v) => "qa" -> (v :+ 1.02); case kv => kv }
    val (line, full) = Bench.renderLines(rerun, Seq(0.4, 0.4), "/tmp/x", reran = Seq("qa"))
    val j = mapper.readTree(line)
    assert(math.abs(j.get("queries").get("qa").asDouble - 1.02) < 1e-9)
    val jf = mapper.readTree(full)
    assert(jf.get("reran").asInt === 1)
    // "samples" stays the protocol constant: min over NON-FAILED vectors,
    // unmoved by the reran query's extra sample or the failed one's stub
    assert(jf.get("samples").asInt === 3)
    assert(jf.get("reran_queries").size === 1)
    assert(jf.get("reran_queries").get(0).asText === "qa")
  }

  test("priorMids maps the prior artifact's short keys back to full names and skips unknowns") {
    val tmp = java.nio.file.Files.createTempFile("bench-prior", ".json")
    java.nio.file.Files.write(tmp,
      """{"queries":{"qa":0.1},"queries_mid":{"qa":0.15,"qb":0.30,"gone":9.9}}"""
        .getBytes("UTF-8"))
    val m = Bench.priorMids(tmp.toString, Seq("qa_agg", "qb_scan"))
    assert(m === Map("qa_agg" -> 0.15, "qb_scan" -> 0.30))
    // missing file / no queries_mid → quiet empty map, never a throw
    assert(Bench.priorMids("/nonexistent/x.json", Seq("qa_agg")) === Map.empty)
  }

  test("median averages the two middle samples for even N") {
    assert(Bench.median(Seq(0.1, 0.2, 0.3)) === 0.2)
    assert(Bench.median(Seq(0.1, 0.2, 0.3, 0.4)) === 0.25)
    assert(Bench.median(Seq(2.0, 1.0)) === 1.5)
  }

  test("min/median/max are picked per query from the sample vector") {
    val (line, full) = Bench.renderLines(
      Seq("qa" -> Seq(0.30, 0.10, 0.20)), Seq(0.4, 0.4, 0.4), "/tmp/x")
    val j = mapper.readTree(line)
    assert(math.abs(j.get("queries").get("qa").asDouble - 0.10) < 1e-9)
    val jf = mapper.readTree(full)
    assert(math.abs(jf.get("queries_mid").get("qa").asDouble - 0.20) < 1e-9)
    assert(math.abs(jf.get("queries_max").get("qa").asDouble - 0.30) < 1e-9)
  }

  test("failed queries emit -1 and are excluded from the total") {
    val results = Seq("q_ok" -> Seq(1.5, 2.0, 1.8), "q_bad" -> Seq(-1.0))
    val (line, full) = Bench.renderLines(results, Seq(0.4, 0.4, 0.4), "/tmp/x")
    val j = mapper.readTree(line)
    assert(j.get("failed").asInt === 1)
    assert(j.get("queries").get("q_bad").asInt === -1)
    assert(math.abs(j.get("value").asDouble - 1.5) < 1e-9)
    val jf = mapper.readTree(full)
    assert(jf.get("samples").asInt === 3)
    assert(jf.get("queries_mid").get("q_bad").asInt === -1)
    assert(jf.get("queries_max").get("q_bad").asInt === -1)
  }

  test("a hostile sfDir (quotes, backslashes) still yields valid JSON") {
    val (line, full) = Bench.renderLines(
      Seq("q" -> Seq(0.1, 0.1, 0.1)), Seq(0.4, 0.4, 0.4), """/tmp/we"ird\dir""")
    assert(mapper.readTree(line).get("sf").asText === """/tmp/we"ird\dir""")
    assert(mapper.readTree(full).get("sf").asText === """/tmp/we"ird\dir""")
  }
}
