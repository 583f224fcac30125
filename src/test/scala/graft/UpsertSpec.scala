package graft

import graft.operators.Upsert
import org.scalatest.funsuite.AnyFunSuite

class UpsertSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Any](0) -> r.getAs[String](1)).toMap

  test("new beats old on PK collision; both sides' exclusives survive") {
    // ref: src/etl-utils.ts:289,319 — concat + unique(keep='last')
    val old = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("id", "v")
    val fresh = Seq((2L, "new2"), (4L, "new4")).toDF("id", "v")
    val got = asMap(Upsert.keepLast(old, fresh, Seq("id")))
    assert(got == Map(1L -> "old1", 2L -> "new2", 3L -> "old3", 4L -> "new4"))
  }

  test("merging the same batch twice is idempotent") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val batch = Seq((2L, "c"), (3L, "d")).toDF("id", "v")
    val once = Upsert.keepLast(old, batch, Seq("id"))
    val twice = Upsert.keepLast(once, batch, Seq("id"))
    assert(asMap(once) == asMap(twice))
  }

  test("result is PK-unique even with in-batch duplicates, tie-broken deterministically") {
    val old = Seq((1L, "old", 0)).toDF("id", "v", "seq")
    val fresh = Seq((1L, "n1", 1), (1L, "n2", 2)).toDF("id", "v", "seq")
    val got = Upsert.keepLast(old, fresh, Seq("id"), tieBreak = Seq("seq"))
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("v") == "n2") // highest tie-break wins
  }

  test("null PKs group together (Polars unique null grouping)") {
    val old = Seq((Some(1L), "old1"), (None, "oldnull")).toDF("id", "v")
    val fresh = Seq((Option.empty[Long], "newnull")).toDF("id", "v")
    val got = asMap(Upsert.keepLast(old, fresh, Seq("id")))
    assert(got == Map(1L -> "old1", null.asInstanceOf[Any] -> "newnull"))
  }

  test("composite PK and schema drift (missing column null-fills)") {
    val old = Seq((1L, 1, "old")).toDF("k1", "k2", "v")
    val fresh = Seq((1L, 1), (1L, 2)).toDF("k1", "k2")
    val got = Upsert.keepLast(old, fresh, Seq("k1", "k2"))
      .orderBy("k1", "k2").collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(2)) // (1,1) replaced by fresh row without v
    assert(got(1).isNullAt(2))
  }
}
