package graft

/** Single-line JSON artifacts for the drivers (bench / demo throughput).
  * The harness previously scraped these numbers from a ~2000-char stderr
  * tail, which decapitated long lines and left bench records unparsed;
  * writing the line to a stable file makes each round's numbers a durable,
  * regression-diffable artifact.
  */
object Artifacts {
  /** Write `line` (one JSON object) to `path`, overwriting. Failures warn
    * and never kill the run — the artifact is a recording, not a gate.
    */
  def writeLine(path: String, line: String): Unit =
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(path), (line + "\n").getBytes("UTF-8"))
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[artifact] write $path failed: ${e.getMessage}")
    }

  /** Append `line` (one JSON object) to `path`, creating it if missing —
    * for multi-run artifacts (one line per preset/run).
    */
  def appendLine(path: String, line: String): Unit =
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(path), (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[artifact] append $path failed: ${e.getMessage}")
    }

  /** Host-speed calibration: a fixed pure-CPU job (2B xxhash64 reduced by bit_xor, no
    * I/O, no shuffle beyond the one partial-agg exchange) timed on its
    * second run (the first absorbs its own codegen/JIT). Cross-round
    * per-query comparisons divide by this — round-over-round swings on
    * unchanged plans have measured up to ±30% from host contention alone,
    * indistinguishable from a real regression without a yardstick.
    */
  def calibrate(spark: org.apache.spark.sql.SparkSession): Double = {
    val slices = spark.sparkContext.defaultParallelism
    // bit_xor, not sum: 2B hash sums overflow BIGINT under ANSI mode
    def run(): Unit = spark.range(0, 2000000000L, 1, slices)
      .selectExpr("xxhash64(id) AS h").selectExpr("bit_xor(h)").collect()
    run()
    val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
  }
}
