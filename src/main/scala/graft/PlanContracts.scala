package graft

import org.apache.spark.sql.SparkSession

/** Preset-portable plan contracts for the flagship scale queries.
  *
  * PlanSpec asserts these in-process at the demo preset; `GraftConfig.active`
  * is frozen at class-load, so the 100tb-geometry run needs its own JVM —
  * [[PlanAudit]] launches one per preset and records the violations to a
  * driver-parseable artifact. The rules here are SHAPE rules (broadcast vs
  * shuffle join, segmented vs serialized windows, no cartesian blowup), the
  * properties that must hold at any geometry: a preset change that flips one
  * of them (e.g. a 51 MB centroid table silently demoting a broadcast to a
  * sort-merge join, or a wider signature knocking a window out of its
  * segmented form) is exactly the regression this exists to catch.
  */
object PlanContracts {

  final case class Violation(query: String, rule: String)

  /** The flagship set: the most expensive family representative per pillar. */
  val Flagships: Seq[String] = Seq(
    "d8_scalable_dedup", "d10_hash_decontaminate", "d13_leakage_safe_split",
    "d14_containment_dedup", "t8_token_packing",
    "g22_ap_sweep", "v10_ivfpq_ann", "v11_ann_recall")

  def check(spark: SparkSession, sfDir: String): Seq[Violation] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Violation]

    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    def rowWindowsSegmented(name: String, orderCol: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val ws = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.orderSpec.exists(_.child.references.exists(_.name == orderCol)) => w
      }
      if (ws.isEmpty)
        out += Violation(name, s"lost its cumulative window ordered by $orderCol")
      for (w <- ws if w.partitionSpec.size < 2)
        out += Violation(name,
          s"row-level window partitions only by ${w.partitionSpec.mkString(",")} — serialized")
    }

    for (name <- Flagships) {
      val p = plan(name)
      // BroadcastNestedLoopJoin is NOT flagged: the engine's only BNLJs are
      // deliberate crossJoin(broadcast(1-row stats)) scalar joins — cheap at
      // any scale. CartesianProduct (both sides partitioned) never is.
      if (p.contains("CartesianProduct")) out += Violation(name, "plans a CartesianProduct")
      // every flagship routes its lookup sides over broadcast — a preset
      // that silently exceeds the broadcast threshold shows up here as a
      // SortMergeJoin where none belongs
      if (!p.contains("BroadcastExchange"))
        out += Violation(name, "no BroadcastExchange — a lookup side went shuffle")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val global = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window if w.partitionSpec.isEmpty => w
      }
      if (global.nonEmpty) out += Violation(name, "plans a partition-less Window")
    }

    // segmented-window contracts (the round-6/7 scale ceilings, kept fixed)
    rowWindowsSegmented("t8_token_packing", "doc_id")
    rowWindowsSegmented("g22_ap_sweep", "frame_id")
    if (!plan("t8_token_packing").contains("BroadcastExchange"))
      out += Violation("t8_token_packing", "segment offsets must ride a broadcast join")
    // pre-reduced top-k on both recall sides: partial + final × 2
    if ("WindowGroupLimit".r.findAllIn(plan("v11_ann_recall")).size < 4)
      out += Violation("v11_ann_recall", "lost WindowGroupLimit pre-reduction")

    out.toSeq
  }
}

/** Per-preset plan audit: `GRAFT_PRESET=100tb runMain graft.PlanAudit [sfDir]`.
  * One JSON line per preset upserted into `plan_audit_last.json`; exits
  * nonzero when any contract is violated, so a scripted round fails loudly.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val preset = sys.env.getOrElse("GRAFT_PRESET", "demo")
    GraftSession.quietStartupWarnings()
    val spark = GraftSession.builder()
      .config("spark.sql.debug.maxToStringFields", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val violations = PlanContracts.check(spark, sfDir)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val vs = violations.map(v => s"""{"query":${q(v.query)},"rule":${q(v.rule)}}""")
      .mkString("[", ",", "]")
    val line =
      s"""{"metric":"plan_audit","preset":"$preset","flagships":${PlanContracts.Flagships.size},""" +
        s""""violations":${violations.size},"details":$vs,"sf":"$sfDir"}"""
    Artifacts.upsertLine(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_AUDIT_OUT", "plan_audit_last.json"),
      s""""preset":"$preset"""", line)
    spark.stop()
    println(line)
    Console.out.flush()
    if (violations.nonEmpty) sys.exit(1)
  }
}
