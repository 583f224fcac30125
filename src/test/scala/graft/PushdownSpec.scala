package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that filters and projections actually reach the parquet scan —
  * the property every 100 TB query depends on. A plan that filters in
  * Spark after reading all columns is correct and useless at scale; these
  * asserts fail if a future refactor breaks pushdown.
  */
class PushdownSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(walk)
    }
    df.collect()
    walk(df.queryExecution.executedPlan)
  }

  test("filter and projection push into the parquet scan") {
    val dir = tmpDir("pushdown")
    (1L to 1000L).map(i => (i, s"name$i", i % 7, i * 1.5))
      .toDF("id", "name", "grp", "score")
      .write.mode("overwrite").parquet(s"$dir/t")
    val q = spark.read.parquet(s"$dir/t")
      .filter(col("grp") === 3)
      .select("id", "grp")
    val Seq(scan) = scans(q)
    // predicate reached the scan (row-group stats + page skipping)
    assert(scan.metadata("PushedFilters").contains("EqualTo(grp,3)"),
      scan.metadata("PushedFilters"))
    // projection pruned the read schema to the 2 referenced columns
    val readSchema = scan.metadata("ReadSchema")
    assert(readSchema.contains("id") && readSchema.contains("grp"))
    assert(!readSchema.contains("name") && !readSchema.contains("score"),
      readSchema)
  }

  test("partition-column predicate prunes directories, not rows") {
    val dir = tmpDir("partprune")
    (1L to 200L).map(i => (i, (i % 4).toString))
      .toDF("id", "part")
      .coalesce(1)
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/t")
    val q = spark.read.parquet(s"$dir/t").filter(col("part") === "2")
    val Seq(scan) = scans(q)
    // one of four hive-style directories survives partition pruning
    assert(scan.metadata("PartitionFilters").nonEmpty)
    assert(scan.relation.location.inputFiles.length == 4)
    assert(scan.metrics("numFiles").value == 1)
  }

  test("q113 day filter prunes to exactly the 3 matching day partitions") {
    val df = graft.queries.ReaderQueries.q113PartitionPrune
      .fn(spark, "/root/testdata/sf0.001")
    val Seq(scan) = scans(df)
    assert(scan.metadata("PartitionFilters").nonEmpty,
      scan.metadata.toString)
    // events spans 30 days; the BETWEEN keeps days 19725..19727 only
    val dayDirs = scan.relation.location.inputFiles
      .flatMap("day_idx=(\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).distinct
    assert(dayDirs.length >= 25, s"staging wrote ${dayDirs.length} days")
    val touched = scan.metrics("numFiles").value
    assert(touched == 3, s"scan touched $touched files, expected 3")
  }
}
