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
    val (line, full) = Bench.renderLines(results, Seq(0.41, 0.39, 0.44), "/root/testdata/sf0.1")
    assert(line.length < 1900, s"stdout line ${line.length} chars risks decapitation")
    val j = mapper.readTree(line)
    assert(j.get("n").asInt === names.size)
    assert(j.get("failed").asInt === 0)
    assert(j.get("samples").asInt === 3)
    assert(j.get("stat").asText === "min")
    assert(j.get("queries").size === names.size)
    assert(j.get("calib_pts").size === 3)
    assert(!line.contains("queries_max") && !line.contains("queries_mid"),
      "spread maps must stay off the stdout line")
    // the durable record carries the judge-auditable spread: median + max
    val jf = mapper.readTree(full)
    assert(jf.get("queries_max").size === names.size)
    assert(jf.get("queries_mid").size === names.size)
    assert(jf.get("queries").size === names.size)
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
    assert(j.get("samples").asInt === 3)
    assert(j.get("queries").get("q_bad").asInt === -1)
    assert(math.abs(j.get("value").asDouble - 1.5) < 1e-9)
    val jf = mapper.readTree(full)
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
