package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed shuffles — the generalization of the
  * bucket-cap salting inside [[Dedup.saltedSelfJoin]] to arbitrary joins
  * and distinct aggregations.
  *
  * First line of defense at scale is AQE (`spark.sql.adaptive.skewJoin`):
  * it splits oversized sort-merge partitions at runtime with no plan
  * change. These helpers cover the two shapes AQE does NOT fix:
  * broadcast-infeasible joins whose hot key concentrates in ONE task even
  * after splitting (salting redistributes the key itself), and
  * `count(DISTINCT)` on a hot group, where the distinct set of one key
  * must otherwise assemble in one task.
  */
object Skew {

  /** Inner equi-join where the LEFT side's hot keys would overload single
    * tasks: left rows get a deterministic salt in [0, s), right rows
    * replicate s× (one copy per salt), and the join key becomes
    * (key, salt) — each hot key now spreads over s tasks. Row-identical to
    * the plain join for any salt assignment (each left row meets each
    * right match in exactly one salt group); the salt is derived from
    * `saltFrom` (pick a high-cardinality column, e.g. the left PK) so runs
    * are reproducible. Replication cost: |right| × s extra rows — size s
    * to the skew factor, not to parallelism.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      saltFrom: Column,
      s: Int): DataFrame = {
    require(s >= 1, "salt fan-out must be >= 1")
    val salted = left.withColumn("__salt", pmod(xxhash64(saltFrom), lit(s)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((s - 1).toLong))))
    salted
      .join(replicated,
        leftKey === rightKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Exact `count(DISTINCT value)` per key with the distinct work spread
    * over `s` tasks per key: phase 1 deduplicates within (key,
    * hash(value) % s) — values land in disjoint salt cells, so cell-level
    * distinct counts are additive — phase 2 sums the cells. Identical to
    * the one-shot distinct for every input; the hot key's value set never
    * assembles in one place.
    */
  def saltedCountDistinct(
      df: DataFrame,
      key: Column,
      value: Column,
      s: Int): DataFrame = {
    require(s >= 1, "salt fan-out must be >= 1")
    df.select(key.as("__key"), value.as("__v"))
      .withColumn("__salt", pmod(xxhash64(col("__v")), lit(s)))
      .groupBy(col("__key"), col("__salt"))
      .agg(countDistinct(col("__v")).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as("n_distinct"))
  }
}
