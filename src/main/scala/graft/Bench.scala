package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    GraftSession.quietStartupWarnings()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // wide generated plans (128-slice signatures at the capacity preset)
      // exceed the 25-field default and WARN-spam plan truncation notices
      .config("spark.sql.debug.maxToStringFields", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // late-register graft extensions (SQL functions + RangeJoinRewrite) so
    // benchmarks run the same plans GraftSession produces
    GraftExtensions.install(spark)
    // warm up codegen/JIT and file listing so the first measured query
    // doesn't absorb one-time JVM costs
    Seq("documents", "embeddings", "lineitem", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1000)
        .groupBy().count().collect()
      catch { case _: Throwable => () }
    }
    // host-speed yardstick for cross-round comparison (see Artifacts.calibrate)
    val calib = Artifacts.calibrate(spark)
    // fixed name order: residual JVM warmup lands on the same queries every
    // round, so per-query numbers stay comparable across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: every output column is evaluated (count() would let
      // Catalyst prune computed columns from projection-only queries and
      // time a bare scan instead)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      // a failed query must not masquerade as a fast timing: emit -1
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // The harness keeps only the last ~2000 chars of output; a full-name
    // 9-decimal map for 80+ queries overflows that window and the JSON line
    // gets decapitated. Emit the shortest unambiguous prefix per query id
    // (q1_agg -> q1, e_tumbling_window -> e_tumbling) and centisecond
    // precision so the one line stays well under the window.
    def shortKeys(names: Seq[String]): Map[String, String] = {
      def prefix(n: String, toks: Int) = n.split('_').take(toks).mkString("_")
      names.map { n =>
        val cand = (1 to n.count(_ == '_') + 1).iterator
          .map(t => prefix(n, t))
          .find(p => names.count(m => prefix(m, p.count(_ == '_') + 1) == p) == 1)
          .getOrElse(n)
        n -> cand
      }.toMap
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val short = shortKeys(results.map(_._1))
    val qs = results.map { case (k, v) =>
      val rounded = if (v < 0) "-1" else fmt(v)
      "\"" + short(k) + "\":" + rounded
    }.mkString("{", ",", "}")
    // headline total covers SURVIVING queries only; failed ones are counted
    // explicitly so a partial run can never masquerade as a comparable total
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFailed = results.count(_._2 < 0)
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","calib":${fmt(calib)},"n":${results.size},"failed":$nFailed,"queries":$qs,"sf":"$sfDir"}"""
    // durable copy: the stderr tail the driver scrapes is ~2000 chars and
    // has decapitated this line two rounds running ("parsed": null)
    Artifacts.writeLine(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json"), line)
    // Stop Spark BEFORE printing: executor/blockmanager shutdown logs land on
    // stderr first, leaving the JSON as the process's final stdout line (the
    // driver parses exactly that — build.sbt strips sbt's prefix/success noise).
    spark.stop()
    println(line)
    Console.out.flush()
  }
}
