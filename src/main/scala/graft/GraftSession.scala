package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session factory with the settings this engine assumes.
  *
  * Tuned for the driver harness (single-JVM `local[N]`) but every knob is
  * cluster-sane: AQE on (runtime shuffle-partition coalescing + skew-join
  * splitting), shuffle partitions sized to cores rather than the 200
  * default, UTC session time zone for oracle parity.
  */
object GraftSession {

  /** Silence the one unavoidable environment WARN (no native hadoop lib in
    * the image) so main stderr stays a real signal channel. Must run
    * BEFORE session creation, and must FORCE the class to load while the
    * level is suppressed: the warn fires in NativeCodeLoader's static
    * block, and Spark reinitializes log4j2 during session creation, wiping
    * the level before a lazy classload would get there.
    */
  def quietStartupWarnings(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.hadoop.util.NativeCodeLoader", org.apache.logging.log4j.Level.ERROR)
    try Class.forName("org.apache.hadoop.util.NativeCodeLoader")
    catch { case _: Throwable => () }
  }

  /** Compressed-input bytes one INITIAL shuffle partition absorbs before
    * the count steps up a core-multiple. Calibrated to the two measured
    * operating points of this engine's heaviest stage (the LSH band
    * explode, ~27× input→shuffle amplification): at the ×10 corpus
    * (~175 MB parquet) exactly-32 partitions spilled ~2.9 GB/query
    * (148 MB execution share per task) while 2×cores = 64 returned spill
    * to zero, and at sf0.1 (~18 MB) a flat 2× start costs sub-second
    * window/vector queries 64-task scheduling overhead AQE cannot recover
    * (coalescing happens after the map side). 3 MB/core/multiple puts the
    * step between those points: ≤ ~96 MB input → 1×, ~1 GB → capped 4×.
    */
  private val BytesPerCorePerStep = 3L << 20

  /** Initial shuffle-partition count for a stage reading `inputBytes` of
    * compressed input on `cores` cores: a CORE MULTIPLE (even wave
    * scheduling) in [1×, 4×], stepping up with input volume. Why the cap:
    * downstream stages inherit the count as their MAP side, where fewer
    * rows per task weakens partial aggregation — measured at 4× on the
    * ×10 corpus, banded dedup wrote +34% shuffle bytes and ran ~40%
    * slower, so growth past 4× must come from a cluster's added cores,
    * not more partitions per core.
    */
  def initialPartitions(inputBytes: Long, cores: Int): Int = {
    val mult = math.min(4L, math.max(1L,
      math.ceil(inputBytes.toDouble / (cores.toLong * BytesPerCorePerStep)).toLong))
    (mult * cores).toInt
  }

  /** Total on-disk bytes under `dir` (driver-side metadata call; 0 for a
    * missing dir — sizing then defaults to 1×). Resolved through the
    * Hadoop FileSystem for the dir's own scheme, NOT a java.io.File walk:
    * the local-only walk silently returned 0 for any non-local corpus URI
    * (hdfs://, s3a://) — collapsing `initialPartitions` to the 1× start
    * on exactly the large corpora the sizing rule exists to protect
    * (round-15 advice). A corpus dir that exists but measures 0 bytes is
    * warned about for the same reason. At cluster scale this is the
    * catalog's table statistics; here it is the corpus directory the
    * main is about to read.
    */
  def dirBytes(dir: String): Long = dirBytes(dir, None)

  /** As [[dirBytes]], but resolving the FileSystem through `hadoopConf`
    * when given — a live session MUST pass its own
    * `spark.sparkContext.hadoopConfiguration`, or spark.hadoop.* settings
    * (s3a credentials/endpoints) are invisible and exactly the remote
    * corpora this sizing protects fail to size and silently fall back to
    * the 1× start. The bare Configuration remains only for the
    * pre-session builder path, where no session conf exists yet.
    */
  def dirBytes(dir: String,
      hadoopConf: Option[org.apache.hadoop.conf.Configuration]): Long =
    try {
      val uri = new java.net.URI(dir)
      val conf = hadoopConf.getOrElse(new org.apache.hadoop.conf.Configuration())
      val fs = org.apache.hadoop.fs.FileSystem.get(uri, conf)
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) 0L
      else {
        val bytes = fs.getContentSummary(p).getLength
        if (bytes == 0L)
          System.err.println(s"[graft] corpus dir $dir measured 0 bytes — " +
            "shuffle sizing will fall back to the 1x start")
        bytes
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] corpus dir $dir could not be sized " +
          s"(${e.getMessage}) — shuffle sizing falls back to the 1x start")
        0L
    }

  /** Re-size the session's AQE start parallelism for a corpus at `dir` —
    * for mains that synthesize or switch corpora mid-session (ScaleBench
    * sweeps ×1/×3/×10 in one JVM): `initialPartitionNum` is a runtime SQL
    * conf, so each scale's stages start at the count ITS bytes warrant.
    * Returns the count set.
    */
  def sizeShuffleFor(spark: SparkSession, dir: String): Int = {
    val n = initialPartitions(
      dirBytes(dir, Some(spark.sparkContext.hadoopConfiguration)),
      spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n.toString)
    n
  }

  /** Shuffle-writer selection threshold (spark.shuffle.sort.bypassMergeThreshold,
    * Spark default 200). The bypass-merge writer opens R partition files per
    * MAP TASK; at this engine's shuffle geometry (R = 32–128 reduce
    * partitions × as many map tasks) that is thousands of file
    * opens+streams per shuffle, and r18 thread-sampling showed
    * DiskBlockObjectWriter.initialize/createTempShuffleBlock dominating the
    * verify family's runtime (d6 ×10 warm: 4.2 s → 1.8 s with the sort
    * writer). At 100 TB R is far above any threshold, so the SORT writer is
    * what production runs anyway — a low threshold makes demo-scale
    * shuffles exercise the same writer instead of a worse one production
    * never uses. 16 keeps genuinely tiny fan-outs (R ≤ 16: scalar/bounded
    * shuffles) on the cheap bypass path. Env-overridable for A/Bs.
    */
  def bypassMergeThreshold: String =
    sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "16")

  /** Let the planner pick shuffled-hash join when its size conditions are
    * met (spark.sql.join.preferSortMergeJoin=false — the guide's §9
    * baseline): SHJ skips both sides' sorts and Spark only chooses it when
    * one side's per-partition build fits memory, so sort-merge remains the
    * fallback for unbounded sides. Measured r19 (warm A/B, same window):
    * j7 1.55 → 1.37, j4 0.96 → 0.87, j8 1.09 → 1.02 at sf0.1.
    * Env-overridable for A/Bs.
    */
  def preferSortMergeJoin: String =
    sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false")

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession.Builder = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Size-adaptive shuffle parallelism, BY STAGE INPUT BYTES (see
    // initialPartitions): stages start at an input-sized core multiple and
    // AQE coalesces small ones back down, so a wide stage's per-task
    // working set no longer grows linearly with the corpus at a pinned
    // count, while small-corpus sessions keep the 1× start whose absence
    // cost sub-second queries 2× in scheduling overhead (round-14 lesson:
    // a FLAT 2× start fixed the ×10 spill but taxed every demo-scale
    // query). SPARK_GRAFT_INIT_MULT stays as an explicit override for
    // experiments; corpus-switching mains re-size via sizeShuffleFor.
    val initial = sys.env.get("SPARK_GRAFT_INIT_MULT") match {
      case Some(m) => m.toInt * cores
      case None => initialPartitions(
        dirBytes(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")), cores)
    }
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // registers graft's custom expressions for SQL use (simhash56, …)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.shuffle.sort.bypassMergeThreshold", bypassMergeThreshold)
      .config("spark.sql.join.preferSortMergeJoin", preferSortMergeJoin)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initial.toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // QA metadata maps follow Python-dict last-wins collision semantics
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // the driver's testdata parquet uses TIMESTAMP(NANOS), which Spark only
      // reads as a long; Tables/queries convert explicitly where needed
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
  }

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Accessors for the driver-provided TPC-H-ish test tables
  * (see TESTDATA.md). At cluster scale these would be catalog tables;
  * here they are bare parquet directories keyed by scale-factor dir.
  */
object Tables {

  /** Epoch-nanos for a UTC date literal — kept for nanos-long-encoded
    * fixtures, where date predicates compare raw longs and stay
    * pushdown-eligible at the parquet scan.
    */
  def nanos(isoDate: String): Long =
    java.time.LocalDate.parse(isoDate).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000000L

  /** Nanos-long column → TimestampType (micros). */
  def tsFromNanos(c: Column): Column = timestamp_micros((c / 1000L).cast("long"))

  /** Normalize a physically-variant timestamp column to the engine-internal
    * representation: epoch-micros LONG. The driver has shipped the testdata
    * with two encodings so far — TIMESTAMP(NANOS), which Spark surfaces as
    * an epoch-nanos long under `nanosAsLong`, and TIMESTAMP_MICROS
    * (isAdjustedToUTC=false), which surfaces as TIMESTAMP_NTZ. Branching on
    * the observed dtype here means every downstream query keeps seeing
    * epoch-micros longs regardless of which physical encoding the parquet
    * carries. The NTZ→timestamp cast is identity because the session time
    * zone is pinned to UTC (builder above).
    */
  def toEpochMicros(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType                          => df.withColumn(colName, expr(s"`$colName` div 1000"))
      case TimestampType                     => df.withColumn(colName, unix_micros(col(colName)))
      case TimestampNTZType                  => df.withColumn(colName, unix_micros(col(colName).cast("timestamp")))
      case other =>
        throw new IllegalStateException(
          s"unsupported physical type for $colName: $other (expected nanos LONG or TIMESTAMP[_NTZ])")
    }
  }

  /** Normalize a physically-variant date/timestamp column to the
    * representation date-predicate queries are written against:
    * TIMESTAMP_NTZ. Same drift-tolerance as toEpochMicros, for the columns
    * whose queries compare against `lit(...).cast("timestamp_ntz")`
    * literals rather than doing micros arithmetic.
    */
  def toNtz(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType          => df.withColumn(colName, tsFromNanos(col(colName)).cast(TimestampNTZType))
      case TimestampType     => df.withColumn(colName, col(colName).cast(TimestampNTZType))
      case TimestampNTZType  => df
      case other =>
        throw new IllegalStateException(
          s"unsupported physical type for $colName: $other (expected nanos LONG or TIMESTAMP[_NTZ])")
    }
  }

  /** Parquet SCHEMAS memoized per (session, path) — metadata only, never
    * rows. `spark.read.parquet(path)` with no explicit schema runs a
    * footer-inference Spark job on every call, and the catalog constructs
    * each table's reader once per query per bench sample (~0.03–0.05 s ×
    * hundreds of constructions per sweep, measured r19: four footer jobs
    * inside one d10 sample). At a deployment this lookup is the catalog/
    * metastore, which caches table schemas by design; here the first load
    * per (session, path) pays the inference job and later loads pass the
    * known schema explicitly. Data is still read from parquet on every
    * execution — only the schema (a StructType, fixed per driver-shipped
    * testdata dir) is reused. Stopped sessions are evicted on access, same
    * hygiene as [[graft.queries.SharedCaches]].
    */
  private val schemaMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    schemaMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    val schema = schemaMemo.getOrElseUpdate((spark, path), spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = toNtz(load(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame  = toNtz(load(s, d, "lineitem"), "l_shipdate")
  /** events with `ts` as epoch-micros long — the engine-internal
    * representation, normalized once at the source from whatever physical
    * encoding the parquet carries (see toEpochMicros). Downstream queries
    * and the DuckDB oracle (`epoch_us(ts)`) both see the same micros.
    */
  def events(s: SparkSession, d: String): DataFrame =
    toEpochMicros(load(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
