package graft.queries

import graft.ext.{Quality, Scd2}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-governance operators: the pre-publish data-quality audit and
  * SCD2 interval history — the two contract-layer steps beyond the
  * reference's keep-last snapshot that a production warehouse load runs.
  */
object EtlQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Data-quality audit ([[graft.ext.Quality]]) over a frame with PLANTED
    * violations (clean source data would prove nothing): deterministic
    * modular selections add null-FK rows, orphan-FK rows, and thereby PK
    * duplicates — the same additive injection is expressed in both
    * engines, so every rule's violation count is adjudicated nonzero.
    * Not-null and uniqueness are aggregate scans; the FK rule is one left
    * join against the deduplicated parent (broadcast at dimension size).
    */
  val q85QualityAudit: QuerySpec = QuerySpec.oracled(
    "q85_quality_audit",
    """WITH dq AS (
      |  SELECT o_orderkey, o_custkey FROM orders
      |  UNION ALL SELECT o_orderkey, NULL FROM orders
      |    WHERE o_orderkey % 997 = 0
      |  UNION ALL SELECT o_orderkey, -1 FROM orders
      |    WHERE o_orderkey % 1009 = 0),
      |r1 AS (
      |  SELECT 'o_custkey_nulls' AS rule,
      |    count(*) FILTER (WHERE o_custkey IS NULL) AS violations,
      |    count(*) AS checked FROM dq),
      |r2 AS (
      |  SELECT 'o_orderkey_dups' AS rule,
      |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0)
      |      AS BIGINT),
      |    CAST(coalesce(sum(c), 0) AS BIGINT)
      |  FROM (SELECT count(*) AS c FROM dq GROUP BY o_orderkey)),
      |r3 AS (
      |  SELECT 'o_custkey_orphans' AS rule,
      |    count(*) FILTER (WHERE dq.o_custkey IS NOT NULL
      |      AND c.c_custkey IS NULL),
      |    count(*)
      |  FROM dq LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |    ON dq.o_custkey = c.c_custkey)
      |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
      |ORDER BY rule""".stripMargin) { (spark, dir) =>
    val orders = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val dq = orders
      .unionByName(orders.filter(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey"), lit(null).cast("long").as("o_custkey")))
      .unionByName(orders.filter(col("o_orderkey") % 1009 === 0)
        .select(col("o_orderkey"), lit(-1L).as("o_custkey")))
    Quality.report(Seq(
      Quality.notNullRule(dq, "o_custkey"),
      Quality.uniqueRule(dq, "o_orderkey"),
      Quality.foreignKeyRule(dq, "o_custkey",
        t(spark, dir, "customer"), "c_custkey")))
  }

  /** SCD2 interval history ([[graft.ext.Scd2]]): each customer's order
    * stream becomes half-open validity ranges — `valid_to` is the next
    * version's `valid_from`, the open row is flagged current. One keyed
    * shuffle, O(1) window state per row (`lead`). Dates leave as strings
    * (the raw-timestamp oracle trap).
    */
  val q86Scd2History: QuerySpec = QuerySpec.oracled(
    "q86_scd2_history",
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
      |  strftime(lead(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS valid_to,
      |  (lead(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) IS NULL) AS is_current
      |FROM orders
      |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin) {
    (spark, dir) =>
      Scd2.history(t(spark, dir, "orders"),
        key = col("o_custkey"), orderBy = col("o_orderdate"),
        tieBreak = col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"),
          col("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  val all: Seq[QuerySpec] = Seq(q85QualityAudit, q86Scd2History)
}
