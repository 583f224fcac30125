package graft

import graft.ext.{ClusterIndex, Clusters}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.ClusterIndex]]: maintained connected-component labels —
  * fold(pairs) ≡ one-shot CC over the accumulated pair set under any
  * fold slicing (incl. cross-component merges chained THROUGH a fresh
  * batch and a fresh node becoming the new component min), delta-sized
  * relabels, idempotent generations, compaction invariance, retention +
  * time-travel. Oracle twin: q329.
  */
class ClusterIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*): DataFrame =
    ps.toSeq.toDF("id_a", "id_b")

  private def lab(df: DataFrame): Map[Long, Long] =
    df.select("node", "cluster_id").as[(Long, Long)].collect.toMap

  private def oneShot(all: DataFrame): Map[Long, Long] =
    lab(Clusters.connectedComponents(
      all.toDF("src", "dst")).toDF("node", "cluster_id"))

  test("folds equal one-shot CC over the accumulated pairs, any slicing") {
    val b0 = pairs((1L, 2L), (10L, 11L), (20L, 21L))
    val b1 = pairs((2L, 3L), (11L, 12L), (30L, 31L))
    // chained merge THROUGH the fresh batch: 20–21 and 40–41 are
    // separate stored/new comps until one batch links 21~40
    val b2 = pairs((40L, 41L), (21L, 40L))
    val all = b0.unionByName(b1).unionByName(b2)
    val dir = tmpDir("clidx_eq")
    ClusterIndex.build(spark, b0, dir, "d")
    ClusterIndex.fold(spark, b1, dir, "d").count()
    ClusterIndex.fold(spark, b2, dir, "d").count()
    val maintained = lab(ClusterIndex.labels(spark, dir, "d"))
    assert(maintained == oneShot(all) && maintained.nonEmpty)
    assert(maintained(41L) == 20L) // the chained merge landed
  }

  test("a fresh node below the stored min relabels the whole component") {
    val dir = tmpDir("clidx_min")
    ClusterIndex.build(spark, pairs((10L, 11L), (11L, 12L)), dir, "d")
    assert(lab(ClusterIndex.labels(spark, dir, "d"))
      .values.toSet == Set(10L))
    val changed = lab(ClusterIndex.fold(spark, pairs((5L, 12L)), dir, "d"))
    // the delta carries every member's relabel (10, 11, 12 → 5) plus the
    // fresh node's first label
    assert(changed == Map(5L -> 5L, 10L -> 5L, 11L -> 5L, 12L -> 5L))
    assert(lab(ClusterIndex.labels(spark, dir, "d"))
      .values.toSet == Set(5L))
  }

  test("untouched components produce NO delta rows (delta-sized relabel)") {
    val dir = tmpDir("clidx_delta")
    ClusterIndex.build(spark,
      pairs((1L, 2L), (10L, 11L), (20L, 21L)), dir, "d")
    val changed = lab(ClusterIndex.fold(spark, pairs((2L, 3L)), dir, "d"))
    // only the touched component's new node appears: 3 joins cluster 1;
    // members 1, 2 keep their label (root unchanged) — and 10/11/20/21
    // never enter the delta
    assert(changed == Map(3L -> 1L), changed.toString)
  }

  test("a committed generation replays as a no-op instead of double-folding") {
    val dir = tmpDir("clidx_idem")
    ClusterIndex.build(spark, pairs((1L, 2L)), dir, "d")
    val first = lab(ClusterIndex.fold(spark, pairs((2L, 3L)), dir, "d",
      generation = Some(6L)))
    val retry = lab(ClusterIndex.fold(spark, pairs((2L, 3L)), dir, "d",
      generation = Some(6L)))
    assert(retry == first && first.nonEmpty)
    assert(lab(ClusterIndex.labels(spark, dir, "d")) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    intercept[IllegalArgumentException] {
      ClusterIndex.fold(spark, pairs((4L, 5L)), dir, "d",
        generation = Some(2L)).count()
    }
  }

  test("compact collapses deltas; retention + time-travel") {
    val dir = tmpDir("clidx_compact")
    ClusterIndex.build(spark, pairs((1L, 2L), (10L, 11L)), dir, "d")
    ClusterIndex.fold(spark, pairs((2L, 10L)), dir, "d").count()
    val before = lab(ClusterIndex.labels(spark, dir, "d"))
    ClusterIndex.compact(spark, dir, "d")
    assert(ClusterIndex.versions(spark, dir, "d") == Seq(1, 2))
    assert(lab(ClusterIndex.labels(spark, dir, "d")) == before)
    // time-travel to v1 sees the same resolved state (compaction is
    // answer-invariant); a pre-fold view needs a pre-fold version, so
    // REBUILD from only the first batch as v3 and check v2 still
    // answers the merged state
    assert(lab(ClusterIndex.labels(spark, dir, "d", atVersion = Some(1)))
      == before)
    ClusterIndex.build(spark, pairs((1L, 2L)), dir, "d") // v3
    assert(lab(ClusterIndex.labels(spark, dir, "d", atVersion = Some(2)))
      == before)
    assert(lab(ClusterIndex.labels(spark, dir, "d")) == Map(1L -> 1L, 2L -> 1L))
    intercept[IllegalArgumentException] {
      ClusterIndex.labels(spark, dir, "d", atVersion = Some(1))
    }
  }
}
