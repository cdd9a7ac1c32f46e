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
}
