package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit: declarative rules evaluated as aggregates, one
  * (rule, violations, checked) row each — the contract-enforcement step an
  * ETL pipeline runs before publishing a snapshot.
  *
  * 100 TB shape: every rule is one partial-aggregated scan; referential
  * integrity is a LEFT join against the (dimension) parent — broadcast
  * when the parent is dimension-sized, AQE-planned otherwise. No rule ever
  * collects rows to the driver; the report is O(#rules) rows. A multi-rule
  * audit re-scans the fact table once per rule — `persist()` the input (or
  * let parquet column pruning keep each scan narrow) when rule count grows.
  */
object Quality {

  /** Count of rows violating NOT NULL on `colName`. */
  def notNullRule(df: DataFrame, colName: String): DataFrame =
    df.agg(
      count(when(col(colName).isNull, lit(1))).as("violations"),
      count(lit(1)).as("checked"))
      .select(lit(s"${colName}_nulls").as("rule"),
        col("violations"), col("checked"))

  /** Count of EXCESS rows under PK uniqueness (sum of group sizes − 1 over
    * duplicated keys): 0 ⇔ the column is unique.
    */
  def uniqueRule(df: DataFrame, colName: String): DataFrame = {
    val groups = df.groupBy(col(colName)).agg(count(lit(1)).as("c"))
    groups.agg(
      coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L))
        .as("violations"),
      coalesce(sum(col("c")), lit(0L)).as("checked"))
      .select(lit(s"${colName}_dups").as("rule"),
        col("violations"), col("checked"))
  }

  /** Count of child rows whose non-null `childKey` has no match in
    * `parent.parentKey` (FK orphans). The parent is deduplicated before
    * the join so duplicate parent keys cannot multiply child rows.
    */
  def foreignKeyRule(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val parents = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__fk"))
      .join(parents, col("__fk") === col("__pk"), "left")
      .agg(
        count(when(col("__fk").isNotNull && col("__pk").isNull, lit(1)))
          .as("violations"),
        count(lit(1)).as("checked"))
      .select(lit(s"${childKey}_orphans").as("rule"),
        col("violations"), col("checked"))
  }

  /** Evaluate a rule set into one report frame, ordered by rule name. */
  def report(rules: Seq[DataFrame]): DataFrame =
    rules.reduce(_.unionByName(_)).orderBy("rule")
}
