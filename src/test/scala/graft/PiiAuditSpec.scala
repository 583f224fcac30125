package graft

import graft.ext.TextStats

import org.scalatest.funsuite.AnyFunSuite

/** [[TextStats.piiAudit]]: email / Luhn-card / IPv4 detector battery.
  * Oracle twin: q292.
  */
class PiiAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def audit(rows: (Long, String)*) =
    TextStats.piiAudit(rows.toSeq.toDF("doc_id", "text"),
      "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("known Luhn vectors split valid from invalid") {
    val got = audit(
      // 4111111111111111 is the canonical valid test PAN; flipping the
      // check digit breaks it
      1L -> "pay 4111111111111111 or 4111111111111112 now",
      2L -> "5500005555555559 4012888888881881",
      3L -> "no numbers here")
    assert(got(1L) == ((0L, 2L, 1L, 0L, 0L)))
    assert(got(2L) == ((0L, 2L, 2L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("IPv4 octet-range validation") {
    val got = audit(
      1L -> "hosts 10.0.0.1 and 192.168.300.7 and 255.255.255.255",
      2L -> "just text 1.2.3")
    assert(got(1L) == ((0L, 0L, 0L, 3L, 2L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("emails count alongside cards and ips in one doc") {
    val got = audit(
      1L -> "a@b.com c.d+e@f.org 4111111111111111 8.8.8.8")
    assert(got(1L) == ((2L, 1L, 1L, 1L, 1L)))
  }

  test("the audit is a pure projection — no shuffle") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextStats.piiAudit(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }
}
