package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share n-grams
  * with an evaluation/benchmark set, so they can be dropped before
  * training (the standard guard against test-set leakage; the reference
  * engine has no analogue — this is LLM-pipeline extension surface).
  *
  * 100 TB shape: the asymmetry is the whole design. Benchmark suites are
  * MBs — their distinct n-gram set broadcasts to every executor — while
  * the corpus is the 100 TB side and must never shuffle by gram: the
  * broadcast LEFT SEMI join filters each corpus document's exploded
  * n-grams map-side, and because explode keeps a document's grams inside
  * one partition, the per-doc overlap count is computed almost entirely by
  * the partial (map-side) aggregate — the one shuffle carries at most one
  * tiny (doc_id, count) row per matched document. No corpus-sized state
  * ever crosses the wire.
  */
object Decontaminate {

  /** Per-document overlap with the benchmark n-gram set: (doc_id,
    * n_overlap, contaminated). `n_overlap` counts DISTINCT overlapping
    * k-grams (the per-doc gram set is distinct by construction);
    * `contaminated` applies the `minOverlap` threshold. Documents shorter
    * than k tokens have no grams and report 0.
    */
  def flagContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      minOverlap: Int = 3): DataFrame = {
    val benchGrams = Dedup.withShingles(benchmark, idCol, textCol, k)
      .select(explode(col("sh")).as("g"))
      .distinct()
    val corpusGrams = Dedup.withShingles(corpus, idCol, textCol, k)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minOverlap)
          .as("contaminated"))
  }

  /** Decontamination sensitivity curve — the audit a team runs BEFORE
    * picking the n-gram size (the q236 threshold-curve discipline
    * applied to contamination): for each candidate gram length, how many
    * documents the [[flagContaminated]] rule would flag and how much
    * total overlap it sees. Small grams over-flag (common phrases hit
    * the benchmark by chance); long grams under-flag (paraphrase slips
    * through) — the curve shows where the corpus actually sits. One row
    * per gram length: docs, flagged count, flagged ppm (exact floor
    * division), total overlapping distinct grams.
    *
    * Scale shape: each rung is the q58 broadcast semi-join (benchmark
    * gram set broadcast, corpus grams never shuffled); the ladder adds
    * one corpus pass per rung, and rung outputs are 1-row aggregates.
    */
  def sensitivityCurve(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      ks: Seq[Int],
      minOverlap: Int = 3): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"sensitivityCurve: gram lengths must be >= 1, got $ks")
    require(ks.distinct.size == ks.size,
      s"sensitivityCurve: duplicate gram lengths would duplicate rows: $ks")
    ks.map { k =>
      flagContaminated(corpus, benchmark, idCol, textCol, k, minOverlap)
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_flagged"),
          sum("n_overlap").as("total_overlap"))
        .select(lit(k.toLong).as("gram_k"), col("n_docs"),
          col("n_flagged"),
          expr("n_flagged * 1000000 div n_docs").as("flagged_ppm"),
          col("total_overlap"))
    }.reduce(_ unionByName _)
  }
}
