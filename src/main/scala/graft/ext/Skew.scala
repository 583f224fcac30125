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

  /** Detect the join keys holding more than `minShare` of all rows,
    * EXACTLY, with bounded memory: one [[graft.functions.MisraGriesAgg]]
    * sketch pass (≤ `k` counters per partial, k-bounded shuffle — never a
    * groupBy over the full key space; the total row count rides the same
    * aggregate for free) yields ≤ k candidates, then one exact count of
    * the candidates only. The MG superset guarantee covers shares above
    * 1/(k+1), so that soundness precondition is ENFORCED — a threshold
    * below it would silently miss true heavy keys. At 100 TB this is how
    * you find the 3 hot keys without shuffling a billion cold ones. Keys
    * return stringified (the sketch's domain); membership tests compare
    * on `cast(key as string)`, injective for the integral/string keys a
    * join uses.
    */
  def heavyKeys(
      df: DataFrame,
      key: Column,
      minShare: Double,
      k: Int = 256): Seq[String] = {
    require(minShare * (k + 1) > 1.0,
      s"heavyKeys: minShare=$minShare is below the k=$k sketch's " +
        s"guarantee 1/(k+1) — raise k or the share")
    graft.functions.VectorExpressions.register(df.sparkSession)
    val keyed = df.select(key.cast("string").as("__key"))
    val head = keyed
      .agg(count(lit(1)).as("n"),
        expr(s"graft_misra_gries(__key, $k)").as("cand"))
      .head()
    val n = head.getLong(0)
    val cand = head.getSeq[String](1)
    if (cand.isEmpty) return Seq.empty
    keyed.filter(col("__key").isin(cand: _*))
      .groupBy("__key").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > lit(n) * minShare)
      .select("__key").collect().map(_.getString(0)).toSeq
  }

  /** [[saltedJoin]] applied ONLY to a detected hot-key set: hot left rows
    * salt over `s` tasks and hot right rows replicate s×, while cold keys
    * join exactly as a plain shuffle join (salt 0, single copy). This is
    * the production form — blanket salting replicates the ENTIRE right
    * side s×, but skew is by definition concentrated, so paying
    * replication only on the hot keys makes the overhead O(hot matches)
    * instead of O(|right|·s). Row-identical to the plain join for any
    * hot-set choice (each pair still meets in exactly one salt group) —
    * detection quality affects only performance, never the result, which
    * is what lets the oracle adjudicate the plain join.
    */
  def adaptiveSaltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      saltFrom: Column,
      s: Int,
      hotKeys: Seq[String]): DataFrame = {
    require(s >= 1, "salt fan-out must be >= 1")
    if (hotKeys.isEmpty) {
      return left.join(right, leftKey === rightKey)
    }
    val salted = left.withColumn("__salt",
      when(leftKey.cast("string").isin(hotKeys: _*),
        pmod(xxhash64(saltFrom), lit(s))).otherwise(lit(0L)))
    val replicated = right.withColumn("__salt",
      explode(when(rightKey.cast("string").isin(hotKeys: _*),
        sequence(lit(0L), lit((s - 1).toLong)))
        .otherwise(array(lit(0L)))))
    salted
      .join(replicated,
        leftKey === rightKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
