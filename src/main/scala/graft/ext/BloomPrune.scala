package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the manual form of Spark's runtime row-level
  * filtering (`InjectRuntimeFilter`), exposed as an operator so a pipeline
  * can prune a fact scan against ANY dim-side key set, not just the cases
  * the optimizer's heuristics inject.
  *
  * The dim side folds into one fixed-size bloom sketch (a distributed
  * aggregate; only the ~MB bitmap returns to the driver — the same
  * round-trip a broadcast join's build side makes). The sketch rides into
  * the fact scan as a binary literal inside Spark's codegen'd
  * `BloomFilterMightContain`, so fact rows whose key cannot be in the dim
  * side die INSIDE the scan stage — before the join shuffle ever
  * materializes them. False positives survive the filter and are removed
  * by the exact join that follows; false negatives are impossible, so the
  * rewrite is result-invariant (BloomPruneSpec pins both properties).
  *
  * At 100 TB this is the difference between shuffling the full fact table
  * and shuffling only the ~selectivity fraction that can match: with a 1%
  * fpp sketch a dim filter keeping 20% of keys cuts join-shuffle volume
  * ~5× for the price of one map-side probe per row.
  */
object BloomPrune {

  /** `fact` minus the rows whose `factKey` is provably absent from
    * `dim.dimKey`. Keys must be integral (the sketch hashes longs).
    */
  def filterByDim(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      fpp: Double = 0.01): DataFrame = {
    graft.functions.VectorExpressions.register(fact.sparkSession)
    // the sizing count and the sketch aggregate both scan the dim
    // pipeline — persist so it computes once, not twice
    val d = dim.persist()
    val bos = new java.io.ByteArrayOutputStream()
    try {
      // upper bound for sizing; the dim side is the small side by contract
      val nKeys = math.max(d.count(), 1L)
      val bf = d.stat.bloomFilter(dimKey, nKeys, fpp)
      bf.writeTo(bos)
    } finally d.unpersist()
    fact.filter(call_function("graft_bloom_might_contain",
      lit(bos.toByteArray), col(factKey).cast("long")))
  }
}
