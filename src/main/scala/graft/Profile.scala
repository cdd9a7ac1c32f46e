package graft

import org.apache.spark.sql.functions._

/** Dev profiler: times individual queries (or stages) at a given SF dir.
  * Usage: runMain graft.Profile <sfDir> <queryName>...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate()
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[profile] $n: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // warm the JVM/codegen once
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      // noop sink evaluates every output column (count() would prune)
      def run(): Unit = q(spark, sfDir).write.format("noop").mode("overwrite").save()
      time(s"$n (run1)")(run())
      time(s"$n (run2)")(run())
    }
    spark.stop()
  }
}
