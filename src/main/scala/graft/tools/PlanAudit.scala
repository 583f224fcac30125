package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Dev tool: execute every registered query at a small sf and report its
  * FINAL (post-AQE) physical plan's shuffle count, broadcast count,
  * whole-stage-codegen span count, and scan pushdown summary as a markdown
  * table (written to PLAN_AUDIT.md by the caller redirecting stdout, or
  * read in the terminal). Streaming queries execute their stream; the
  * audited plan is then the collected batch result's (trivial) plan, so
  * they are marked `stream` instead of audited.
  *
  * Usage: `sbt "runMain graft.tools.PlanAudit [sfDir]"`.
  */
object PlanAudit {

  final case class Audit(
      shuffles: Int, broadcasts: Int, codegenSpans: Int,
      scans: Int, pushedScans: Int)

  private def children(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case other => other.children
  }

  def audit(plan: SparkPlan): Audit = {
    def walk(p: SparkPlan): Audit = {
      val kids = children(p).map(walk)
        .foldLeft(Audit(0, 0, 0, 0, 0)) { (a, b) =>
          Audit(a.shuffles + b.shuffles, a.broadcasts + b.broadcasts,
            a.codegenSpans + b.codegenSpans, a.scans + b.scans,
            a.pushedScans + b.pushedScans)
        }
      p match {
        case _: ShuffleExchangeLike => kids.copy(shuffles = kids.shuffles + 1)
        case _: BroadcastExchangeLike =>
          kids.copy(broadcasts = kids.broadcasts + 1)
        case _: WholeStageCodegenExec =>
          kids.copy(codegenSpans = kids.codegenSpans + 1)
        case s: FileSourceScanExec =>
          val pushed = s.metadata.get("PushedFilters").exists(_ != "[]") ||
            s.metadata.get("DataFilters").exists(_.nonEmpty)
          kids.copy(scans = kids.scans + 1,
            pushedScans = kids.pushedScans + (if (pushed) 1 else 0))
        case _ => kids
      }
    }
    walk(plan)
  }

  /** Streaming query names: their fn drives a stream and returns a memory
    * sink read, so the batch plan is not the interesting artifact.
    */
  private val streaming = Set(
    "q30_streaming_window", "q38_session_window", "q43_streaming_dedup",
    "q50_streaming_sliding", "q54_streaming_dedup_bounded",
    "q70_streaming_funnel", "q77_stream_stream_join",
    "q84_stream_static_join", "q89_stream_left_outer")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(s"# Plan audit - post-AQE physical plans at `$sfDir`\n")
    println("| query | shuffles | broadcasts | codegen spans | scans (pushed) |")
    println("|---|---|---|---|---|")
    SparkEntry.specs.sortBy(_.name).foreach { spec =>
      if (streaming(spec.name)) {
        println(s"| ${spec.name} | n/a | n/a | n/a | stream (audited by its spec) |")
      } else {
        try {
          val df = spec.fn(spark, sfDir)
          df.collect()
          val a = audit(df.queryExecution.executedPlan)
          println(s"| ${spec.name} | ${a.shuffles} | ${a.broadcasts} " +
            s"| ${a.codegenSpans} | ${a.scans} (${a.pushedScans}) |")
        } catch {
          case e: Exception =>
            println(s"| ${spec.name} | ERROR | | | ${e.getClass.getSimpleName} |")
        }
      }
    }
    spark.stop()
  }
}
